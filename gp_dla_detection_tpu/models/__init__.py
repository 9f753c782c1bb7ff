"""Model layer: the low-rank GP quasar emission model and its trainer."""

from .qso_model import GPModel

__all__ = ["GPModel"]
