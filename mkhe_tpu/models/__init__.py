"""Application models (reference layer L3: cnn/)."""

from . import cnn

__all__ = ["cnn"]
