from .chirp import chirp_tables, mod_reference_tables, symbol_chirp
from .cplx import cmag, cmag2, cmatmul, cmul, from_ri, to_ri
from .dft import BandSpec, ZoomDftPlan
from .dechirp import (
    band_peak,
    down_bands,
    down_peak,
    frame_signal,
    kaiser_window,
    pyramid_spectra,
    up_bands,
    up_peak,
)

__all__ = [
    "chirp_tables", "mod_reference_tables", "symbol_chirp",
    "cmag", "cmag2", "cmatmul", "cmul", "from_ri", "to_ri",
    "BandSpec", "ZoomDftPlan",
    "band_peak", "down_bands", "down_peak", "frame_signal",
    "kaiser_window", "pyramid_spectra", "up_bands", "up_peak",
]
