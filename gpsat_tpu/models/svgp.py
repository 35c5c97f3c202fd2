"""SVGP placeholder — implemented in a later milestone."""
from gpsat_tpu.models.exact_gpr import GPRModel


class SVGPModel(GPRModel):
    """Hensman SVGP (to be implemented; currently falls back to exact GPR)."""
