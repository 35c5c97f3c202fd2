"""SGPR placeholder — implemented in a later milestone."""
from gpsat_tpu.models.exact_gpr import GPRModel


class SGPRModel(GPRModel):
    """Titsias sparse GPR (to be implemented; currently falls back to exact GPR)."""
