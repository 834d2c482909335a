"""Utilities: config system, logging."""

from . import config, logging
