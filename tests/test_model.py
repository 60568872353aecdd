"""Model equivalence tests.

1. Our JAX VGG16 vs an independently-built torch VGG16 (same weights):
   activations must match.
2. The staged linear-refactor forward (fold side conv + fc1 into per-stage
   native-resolution projections) vs the reference-faithful naive hypercolumn
   path: identical outputs.
3. Full torch replication of the reference WESUP forward (hooks, hypercolumn,
   pooling, MLP) vs our forward on the same converted weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from wesup_tpu.models import vgg, wesup
from wesup_tpu.ops.segments import one_hot_assignment


def _build_torch_vgg():
    """torchvision vgg16().features equivalent, built from the config."""
    layers, in_ch = [], 3
    for c in vgg.VGG16_CFG:
        if c == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, c, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = c
    return nn.Sequential(*layers)


class _TorchWESUP(nn.Module):
    """Independent torch replication of the reference WESUP forward
    (models/wesup.py:182-304) for parity testing."""

    def __init__(self, n_classes=2, D=32):
        super().__init__()
        self.backbone = _build_torch_vgg()
        self.side = nn.ModuleList([
            nn.Conv2d(c, c // 2, 1) for c in vgg.CONV_CHANNELS
        ])
        self.fc_layers = nn.Sequential(
            nn.Linear(vgg.FM_CHANNELS_SUM, 1024), nn.ReLU(),
            nn.Linear(1024, 1024), nn.ReLU(),
            nn.Linear(1024, D), nn.ReLU(),
        )
        self.classifier = nn.Sequential(nn.Linear(D, n_classes), nn.Softmax(dim=1))

    def forward(self, x, sp_maps):
        fm_size = x.shape[-2:]
        taps = []
        h = x
        conv_i = 0
        for layer in self.backbone:
            if isinstance(layer, nn.Conv2d):
                h = layer(h)
                side_out = self.side[conv_i](h)
                side_out = F.interpolate(side_out, fm_size, mode="bilinear",
                                         align_corners=True)
                taps.append(side_out)
                conv_i += 1
            else:
                h = layer(h)
        hyper = torch.cat(taps, dim=1)  # (1, 2112, H, W)
        flat = hyper.flatten(2).squeeze(0)  # (2112, HW)
        pooled = sp_maps @ flat.t()  # (K, 2112), sp_maps row-normalized
        feats = self.fc_layers(pooled)
        return self.classifier(feats), feats


def _copy_weights_to_torch(params, tmodel):
    conv_i = 0
    for layer in tmodel.backbone:
        if isinstance(layer, nn.Conv2d):
            p = params["backbone"][f"conv{conv_i}"]
            layer.weight.data = torch.from_numpy(
                np.asarray(p["w"]).transpose(3, 2, 0, 1).copy())
            layer.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())
            conv_i += 1
    for i, conv in enumerate(tmodel.side):
        p = params["side"][f"side{i}"]
        conv.weight.data = torch.from_numpy(
            np.asarray(p["w"]).T[:, :, None, None].copy())
        conv.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())
    for tl, key in [(tmodel.fc_layers[0], "fc1"), (tmodel.fc_layers[2], "fc2"),
                    (tmodel.fc_layers[4], "fc3"), (tmodel.classifier[0], "cls")]:
        p = params[key]
        tl.weight.data = torch.from_numpy(np.asarray(p["w"]).T.copy())
        tl.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())


@pytest.fixture(scope="module")
def small_setup():
    rng = np.random.default_rng(0)
    img = rng.random((1, 48, 64, 3)).astype(np.float32)
    seg = rng.integers(0, 12, (1, 48, 64)).astype(np.int32)
    params = wesup.init_params(jax.random.PRNGKey(0))
    return img, seg, params


def test_vgg_matches_torch(small_setup):
    img, _, params = small_setup
    taps = vgg.backbone_features(params["backbone"], jnp.asarray(img))

    tmodel = _build_torch_vgg()
    conv_i = 0
    for layer in tmodel:
        if isinstance(layer, nn.Conv2d):
            p = params["backbone"][f"conv{conv_i}"]
            layer.weight.data = torch.from_numpy(
                np.asarray(p["w"]).transpose(3, 2, 0, 1).copy())
            layer.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())
            conv_i += 1

    x = torch.from_numpy(img).permute(0, 3, 1, 2)
    torch_taps = []
    h = x
    for layer in tmodel:
        if isinstance(layer, nn.Conv2d):
            h = layer(h)
            torch_taps.append(h.detach().permute(0, 2, 3, 1).numpy())
            h = F.relu(h)
        elif isinstance(layer, nn.MaxPool2d):
            h = layer(h)

    assert len(taps) == 13
    for ours, ref in zip(taps, torch_taps):
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-4)


def test_staged_equals_naive_superpixel_forward(small_setup):
    img, seg, params = small_setup
    K = 12
    fast = wesup.forward_superpixel(params, jnp.asarray(img), jnp.asarray(seg), K)
    naive = wesup.naive_forward_superpixel(params, jnp.asarray(img),
                                           jnp.asarray(seg), K)
    np.testing.assert_allclose(np.asarray(fast.sp_pred),
                               np.asarray(naive.sp_pred), atol=2e-4)
    np.testing.assert_allclose(np.asarray(fast.sp_features),
                               np.asarray(naive.sp_features), atol=2e-3)
    np.testing.assert_allclose(np.asarray(fast.pred),
                               np.asarray(naive.pred), atol=2e-4)


def test_adjoint_pooling_equals_fullres(small_setup):
    """The adjoint-pooled default must match the round-1 full-resolution
    formulation (both exact) including with a nontrivial validity mask."""
    img, seg, params = small_setup
    K = 12
    valid = np.ones(img.shape[:3], bool)
    valid[:, 40:, :] = False
    valid[:, :, 56:] = False
    adj = wesup.forward_superpixel(params, jnp.asarray(img), jnp.asarray(seg),
                                   K, jnp.asarray(valid), pooling="adjoint")
    full = wesup.forward_superpixel(params, jnp.asarray(img), jnp.asarray(seg),
                                    K, jnp.asarray(valid), pooling="fullres")
    np.testing.assert_allclose(np.asarray(adj.sp_pred),
                               np.asarray(full.sp_pred), atol=2e-4)
    np.testing.assert_allclose(np.asarray(adj.sp_features),
                               np.asarray(full.sp_features), atol=2e-3)
    np.testing.assert_allclose(np.asarray(adj.pred),
                               np.asarray(full.pred), atol=2e-4)


def test_forward_matches_torch_reference(small_setup):
    img, seg, params = small_setup
    K = 12
    ours = wesup.forward_superpixel(params, jnp.asarray(img), jnp.asarray(seg), K)

    tmodel = _TorchWESUP()
    _copy_weights_to_torch(params, tmodel)
    tmodel.eval()

    oh = np.asarray(one_hot_assignment(jnp.asarray(seg[0]), K))  # (HW, K)
    sp_maps = oh.T / np.maximum(oh.sum(0)[:, None], 1.0)  # row-normalized (K, HW)

    with torch.no_grad():
        t_pred, t_feats = tmodel(torch.from_numpy(img).permute(0, 3, 1, 2),
                                 torch.from_numpy(sp_maps.astype(np.float32)))

    np.testing.assert_allclose(np.asarray(ours.sp_pred[0]), t_pred.numpy(),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(ours.sp_features[0]), t_feats.numpy(),
                               atol=5e-3)


def test_pixel_forward_equals_naive_per_pixel(small_setup):
    img, _, params = small_setup
    probs = wesup.forward_pixel(params, jnp.asarray(img))
    # naive: materialize hypercolumn, run MLP per pixel with explicit fc1
    hc = wesup.naive_hypercolumn(params, jnp.asarray(img))
    x = hc @ params["fc1"]["w"] + params["fc1"]["b"]
    want, _ = wesup._mlp_head(params, x)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(want), atol=2e-4)


def test_torch_checkpoint_converter(small_setup):
    """Round-trip: build a reference-style state_dict and convert it."""
    img, seg, params = small_setup
    tmodel = _TorchWESUP()
    _copy_weights_to_torch(params, tmodel)

    # emulate the reference's state_dict key naming
    sd = {}
    conv_i = 0
    for j, layer in enumerate(tmodel.backbone):
        if isinstance(layer, nn.Conv2d):
            sd[f"backbone.{j}.weight"] = layer.weight.detach().numpy()
            sd[f"backbone.{j}.bias"] = layer.bias.detach().numpy()
            conv_i += 1
    cum = 0
    for i, c in enumerate(vgg.CONV_CHANNELS):
        conv = tmodel.side[i]
        sd[f"side_conv{cum}.weight"] = conv.weight.detach().numpy()
        sd[f"side_conv{cum}.bias"] = conv.bias.detach().numpy()
        cum += c // 2
    for tl, name in [(tmodel.fc_layers[0], "fc_layers.0"),
                     (tmodel.fc_layers[2], "fc_layers.2"),
                     (tmodel.fc_layers[4], "fc_layers.4"),
                     (tmodel.classifier[0], "classifier.0")]:
        sd[f"{name}.weight"] = tl.weight.detach().numpy()
        sd[f"{name}.bias"] = tl.bias.detach().numpy()

    converted = wesup.convert_torch_state_dict(sd)
    out_a = wesup.forward_superpixel(params, jnp.asarray(img), jnp.asarray(seg), 12)
    out_b = wesup.forward_superpixel(converted, jnp.asarray(img), jnp.asarray(seg), 12)
    np.testing.assert_allclose(np.asarray(out_a.sp_pred),
                               np.asarray(out_b.sp_pred), atol=1e-6)
