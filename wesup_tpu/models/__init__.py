"""Model layer: VGG16 backbone, WESUP model + trainer, factory."""

from ..config import WESUPConfig  # noqa: F401
from . import vgg, wesup  # noqa: F401
from .wesup import (convert_torch_state_dict, forward_pixel,  # noqa: F401
                    forward_superpixel, init_params)


def initialize_trainer(model_type, **kwargs):
    """Map a model name to its trainer (reference models/__init__.py:9-19).

    ``platform=`` ('axon' or 'cpu') is the analogue of the reference CLIs'
    ``device`` option (reference train.py:30, infer.py:41): it pins the JAX
    backend before any device is touched.  Default: the environment's
    platform order (TPU when the tunnel is up).
    """
    platform = kwargs.pop("platform", None)
    if platform:
        from ..runtime import force_platform
        force_platform(platform)
    if model_type == "wesup":
        from .trainer import WESUPTrainer
        return WESUPTrainer(**kwargs)
    raise ValueError(f"Unsupported model: {model_type}")
