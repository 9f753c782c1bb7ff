"""I/O: pure-numpy FITS, stage artifacts, optional native C++ fast path."""

from .fits import BinTable, read_bintable, write_bintable

__all__ = ["BinTable", "read_bintable", "write_bintable"]
