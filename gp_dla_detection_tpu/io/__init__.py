"""I/O: pure-numpy FITS, stage artifacts, optional native C++ fast path."""

from .fits import BinTable, read_bintable, write_bintable
from .matio import (
    load_catalogue_from_matlab,
    read_mat,
    write_dla_samples_mat,
    write_mat,
    write_multi_processed_mat,
    write_processed_mat,
    write_snrs_mat,
)

__all__ = [
    "BinTable",
    "read_bintable",
    "write_bintable",
    "read_mat",
    "write_mat",
    "write_processed_mat",
    "write_multi_processed_mat",
    "write_dla_samples_mat",
    "write_snrs_mat",
    "load_catalogue_from_matlab",
]
