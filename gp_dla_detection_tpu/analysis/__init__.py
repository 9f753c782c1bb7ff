"""Science analysis layer (L7): CDDF, dN/dX, Omega_DLA, plots, tables."""

from .cddf import DLACatalogue, compute_all_snrs, compute_pixel_noise
from .cosmology import AbsorptionPath, hubble_by_h0, path_length_integrand, rho_crit
from .pb import (
    combine_with_poisson,
    interval,
    pdf_confidence,
    poisson_binomial_pdf,
)

__all__ = [
    "DLACatalogue",
    "compute_all_snrs",
    "compute_pixel_noise",
    "AbsorptionPath",
    "hubble_by_h0",
    "path_length_integrand",
    "rho_crit",
    "poisson_binomial_pdf",
    "combine_with_poisson",
    "interval",
    "pdf_confidence",
]
