"""geoestimation_tpu: TPU-native photo geolocation estimation.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of
TIBHannover/GeoEstimation (ECCV 2018). See README.md and SURVEY.md.
"""

__version__ = "0.1.0"

from . import data, eval, geo, ingest, models, ops, parallel, train, utils  # noqa: F401
