from .ar_scan import ar_extrapolate_pallas, pallas_supported

__all__ = ["ar_extrapolate_pallas", "pallas_supported"]
