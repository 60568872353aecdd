"""Model layer: VGG16 backbone, WESUP model + trainer, factory."""


def initialize_trainer(model_type, **kwargs):
    """Map a model name to its trainer (reference models/__init__.py:9-19)."""
    if model_type == "wesup":
        from .trainer import WESUPTrainer
        return WESUPTrainer(**kwargs)
    raise ValueError(f"Unsupported model: {model_type}")
