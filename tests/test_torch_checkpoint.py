"""Loading a reference-format torch .pth checkpoint through the trainer."""

import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).parent))

from test_model import _TorchWESUP, _copy_weights_to_torch  # noqa: E402

import jax  # noqa: E402

from wesup_tpu.models import initialize_trainer, wesup  # noqa: E402
from wesup_tpu.models.vgg import CONV_CHANNELS, TORCH_CONV_INDICES  # noqa: E402


def _reference_state_dict(params):
    """Build a torch state_dict with the reference's key naming."""
    tmodel = _TorchWESUP()
    _copy_weights_to_torch(params, tmodel)
    sd = {}
    conv_positions = [j for j, layer in enumerate(tmodel.backbone)
                      if isinstance(layer, torch.nn.Conv2d)]
    assert conv_positions == TORCH_CONV_INDICES
    for j in conv_positions:
        sd[f"backbone.{j}.weight"] = tmodel.backbone[j].weight.detach()
        sd[f"backbone.{j}.bias"] = tmodel.backbone[j].bias.detach()
    cum = 0
    for i, c in enumerate(CONV_CHANNELS):
        sd[f"side_conv{cum}.weight"] = tmodel.side[i].weight.detach()
        sd[f"side_conv{cum}.bias"] = tmodel.side[i].bias.detach()
        cum += c // 2
    for tl, name in [(tmodel.fc_layers[0], "fc_layers.0"),
                     (tmodel.fc_layers[2], "fc_layers.2"),
                     (tmodel.fc_layers[4], "fc_layers.4"),
                     (tmodel.classifier[0], "classifier.0")]:
        sd[f"{name}.weight"] = tl.weight.detach()
        sd[f"{name}.bias"] = tl.bias.detach()
    return sd


def test_trainer_loads_reference_pth(tmp_path):
    src_params = wesup.init_params(jax.random.PRNGKey(7))
    ckpt = {
        "model_state_dict": _reference_state_dict(src_params),
        "optimizer_state_dict": {},
        "epoch": 42,
    }
    rec = tmp_path / "run" / "checkpoints"
    rec.mkdir(parents=True)
    path = rec / "ckpt.0042.pth"
    torch.save(ckpt, path)

    trainer = initialize_trainer("wesup", compute_dtype="float32")
    trainer.load_checkpoint(str(path))
    assert trainer.initial_epoch == 43
    assert trainer.record_dir == path.parent.parent

    got = np.asarray(trainer.params["fc1"]["w"])
    want = np.asarray(src_params["fc1"]["w"])
    np.testing.assert_allclose(got, want, atol=1e-6)
    got_w = np.asarray(trainer.params["backbone"]["conv0"]["w"])
    want_w = np.asarray(src_params["backbone"]["conv0"]["w"])
    np.testing.assert_allclose(got_w, want_w, atol=1e-6)
