"""Fused relu+maxpool+pad Pallas kernel vs the XLA composition."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

from wesup_tpu.models import vgg  # noqa: E402
from wesup_tpu.ops import pool_pallas as pp  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("cout", [64, 128])
def test_fused_pool_matches_reference(dtype, cout):
    rng = np.random.default_rng(0)
    pre = jnp.asarray(rng.standard_normal((2, 32, 64, 64)), dtype)
    assert pp.supports(pre.shape)
    got = pp.fused_relu_pool_pad(pre, cout)
    want = pp.reference(pre, cout)
    assert got.shape == (2, 16, 32, cout)
    # max + zero-pad involve no arithmetic: bitwise equal in any dtype
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_pool_grad_matches_reference(dtype):
    rng = np.random.default_rng(1)
    pre = jnp.asarray(rng.standard_normal((1, 32, 64, 64)), dtype)
    w = jnp.asarray(rng.standard_normal((128,)), jnp.float32)

    def loss(fn):
        return lambda p: jnp.sum(
            (fn(p, 128).astype(jnp.float32) ** 2) * w)

    g_kernel = jax.grad(loss(pp.fused_relu_pool_pad))(pre)
    g_ref = jax.grad(loss(pp.reference))(pre)
    assert g_kernel.dtype == dtype
    # the VJP literally replays the reference composition: bitwise equal
    np.testing.assert_array_equal(np.asarray(g_kernel, np.float32),
                                  np.asarray(g_ref, np.float32))


def test_unsupported_shape_falls_back():
    rng = np.random.default_rng(2)
    pre = jnp.asarray(rng.standard_normal((1, 34, 64, 64)), jnp.float32)
    assert not pp.supports(pre.shape)  # 17 output rows not block-divisible
    got = pp.fused_relu_pool_pad(pre, 128)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(pp.reference(pre, 128)))


def test_backbone_with_fused_pool1_matches(monkeypatch):
    """backbone_features values are invariant to the fused-pool gate."""
    monkeypatch.setattr(vgg, "_fused_pool1_ok",
                        lambda pre: pre.shape[-1] == 64
                        and pp.supports(pre.shape))
    params = vgg.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((1, 32, 64, 3)), jnp.float32)

    taps_fused = vgg.backbone_features(params, img)
    monkeypatch.setattr(vgg, "_fused_pool1_ok", lambda pre: False)
    taps_ref = vgg.backbone_features(params, img)
    for a, b in zip(taps_fused, taps_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("dtype", ["float64", "int64"])
def test_wide_dtypes_never_reach_mosaic(monkeypatch, dtype):
    """Regression guard for the round-4 hardware-only failure: an f64 input
    traced into the Pallas kernel aborts on the chip (Mosaic has no 64-bit
    types).  fused_relu_pool_pad must route any >32-bit dtype to the XLA
    composition at TRACE time — asserted here via eval_shape (no device
    execution, so this runs in the axon suite too) with the Pallas path
    booby-trapped."""

    def boom(*a, **k):
        raise AssertionError("Pallas path reached with a 64-bit dtype")

    monkeypatch.setattr(pp, "_fused", boom)
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        pre = jax.ShapeDtypeStruct((2, 32, 64, 64), jnp.dtype(dtype))
        out = jax.eval_shape(lambda p: pp.fused_relu_pool_pad(p, 128), pre)
        assert out.shape == (2, 16, 32, 128)
        assert out.dtype == jnp.dtype(dtype)
        # sanity: the supported 32-bit case does still take the Pallas path
        pre32 = jax.ShapeDtypeStruct((2, 32, 64, 64), jnp.float32)
        with pytest.raises(AssertionError, match="Pallas path"):
            jax.eval_shape(lambda p: pp.fused_relu_pool_pad(p, 128), pre32)
    finally:
        jax.config.update("jax_enable_x64", prev_x64)


@pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="XLA TPU cannot compile f64 select_and_scatter (the x64-rewrite "
           "pass is unimplemented for it, and jax_platforms pins a single "
           "backend so no CPU fallback exists in an axon session); this "
           "reassociation check is platform-independent host numerics and "
           "runs in every CPU suite run")
def test_backbone_fused_pool1_grad_f64(monkeypatch):
    """Gradients are invariant to the fused-pool gate (the padded conv2_1
    weight accumulates exact zeros)."""
    params = vgg.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((1, 32, 64, 3)), jnp.float32)

    # the pool VJP replays the reference bitwise, but conv2_1 runs with a
    # 128-channel (zero-widened) input: same exact sum, different
    # accumulation split.  In f32 that reassociation can flip isolated
    # relu/maxpool selections (1-ulp forward difference at a boundary ->
    # O(1) gradient difference at that element), so compare in f64 where
    # the reassociation error is ~1e-15 of scale and flips don't occur.
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        params64 = jax.tree.map(lambda x: jnp.asarray(np.asarray(x),
                                                      jnp.float64), params)
        img64 = jnp.asarray(np.asarray(img), jnp.float64)

        def loss(gate):
            def f(p):
                monkeypatch.setattr(vgg, "_fused_pool1_ok", gate)
                t = vgg.backbone_features(p, img64,
                                          compute_dtype=jnp.float64)
                return sum(jnp.sum(x ** 2) for x in t)
            return f

        on = lambda pre: pre.shape[-1] == 64 and pp.supports(pre.shape)
        g_fused = jax.grad(loss(on))(params64)
        g_ref = jax.grad(loss(lambda pre: False))(params64)
        flat_f, _ = jax.tree_util.tree_flatten(g_fused)
        flat_r, _ = jax.tree_util.tree_flatten(g_ref)
        for a, b in zip(flat_f, flat_r):
            b = np.asarray(b)
            scale = max(1.0, float(np.abs(b).max()))
            np.testing.assert_allclose(np.asarray(a), b, atol=1e-9 * scale)
    finally:
        jax.config.update("jax_enable_x64", prev_x64)
