"""Serving: dynamic-batching inference server."""

from .server import GeoInferenceServer, MicroBatcher
