"""VFF placeholder — implemented in a later milestone."""
from gpsat_tpu.models.exact_gpr import GPRModel


class VFFModel(GPRModel):
    """Variational Fourier features GPR (to be implemented; currently falls back to exact GPR)."""
