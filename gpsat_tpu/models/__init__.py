"""Model zoo + factory.

`get_model(name)` mirrors the reference factory
(reference: GPSat/models/__init__.py:3-28). Reference model names are accepted
as aliases so existing configs keep working:
GPflowGPRModel -> GPRModel, GPflowSGPRModel -> SGPRModel, etc.
"""

from gpsat_tpu.models.base import BaseGPRModel  # noqa: F401


def get_model(name):
    """Map a model name string to a model class."""
    from gpsat_tpu.models.exact_gpr import GPRModel
    from gpsat_tpu.models.kiss_gpr import KISSGPModel
    from gpsat_tpu.models.sgpr import SGPRModel
    from gpsat_tpu.models.svgp import SVGPModel
    from gpsat_tpu.models.vff import VFFModel
    from gpsat_tpu.models.asvgp import ASVGPModel
    from gpsat_tpu.models.multioutput import (MultioutputGPRModel,
                                              MultioutputSVGPModel)

    registry = {
        "GPRModel": GPRModel,
        "KISSGPModel": KISSGPModel,
        "SGPRModel": SGPRModel,
        "SVGPModel": SVGPModel,
        "VFFModel": VFFModel,
        "ASVGPModel": ASVGPModel,
        # multi-output forward-model experts (reference: models/multioutput/,
        # experimental there and not in its factory; registered here for
        # custom drivers)
        "MultioutputGPRModel": MultioutputGPRModel,
        "MultioutputSVGPModel": MultioutputSVGPModel,
        # reference-name aliases (config compatibility)
        "GPflowGPRModel": GPRModel,
        "GPflowSGPRModel": SGPRModel,
        "GPflowSVGPModel": SVGPModel,
        "GPflowVFFModel": VFFModel,
        "GPflowASVGPModel": ASVGPModel,
        "PurePythonGPR": GPRModel,
        "sklearnGPRModel": GPRModel,
        "GPyTorchGPRModel": GPRModel,
        "GPyTorchKISSGPModel": KISSGPModel,
    }
    if name not in registry:
        raise NotImplementedError(
            f"model: {name} is not implemented; available: {sorted(set(registry))}")
    return registry[name]
