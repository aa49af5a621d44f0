"""Pallas fused-attention kernel numerics vs the XLA reference path
(interpret mode on CPU; the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gigaam_tpu.ops.attention import _masked_softmax
from gigaam_tpu.ops.pallas_attention import fused_mha


def _xla_attention(q, k, v, valid):
    scale = 1.0 / np.sqrt(q.shape[-1])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    attn = _masked_softmax(scores, valid).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("t,block_q", [(128, 64), (200, 128), (64, 256)])
def test_fused_matches_xla(t, block_q):
    b, h, d = 2, 4, 48
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    valid = np.ones((b, t), bool)
    valid[1, t // 2:] = False
    valid_j = jnp.asarray(valid)

    ref = np.asarray(_xla_attention(q, k, v, valid_j))
    got = np.asarray(fused_mha(q, k, v, valid_j, block_q=block_q,
                               interpret=True))

    # compare only valid query rows (padded rows are garbage by contract)
    for bi in range(b):
        tv = valid[bi].sum()
        np.testing.assert_allclose(got[bi, :, :tv], ref[bi, :, :tv],
                                   atol=2e-5)


def test_fused_bf16():
    b, h, t, d = 1, 2, 96, 48
    rng = np.random.default_rng(1)
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, h, t, d)).astype(np.float32)).astype(
            jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    valid = jnp.ones((b, t), bool)
    ref = np.asarray(_xla_attention(q, k, v, valid), dtype=np.float32)
    got = np.asarray(fused_mha(q, k, v, valid, interpret=True),
                     dtype=np.float32)
    np.testing.assert_allclose(got, ref, atol=0.05)


@pytest.mark.parametrize("t,block_q", [(128, 64), (200, 128), (64, 256)])
def test_fused_relpos_matches_xla(t, block_q):
    """Fully-fused rel-pos kernel (in-VMEM shear) vs its XLA twin."""
    from gigaam_tpu.ops.pallas_attention import _xla_relpos, fused_relpos_mha

    b, h, d = 2, 4, 48
    rng = np.random.default_rng(2)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    q_u, k, v, q_v = (f32(b, h, t, d) for _ in range(4))
    p_heads = f32(h, 2 * t - 1, d)
    valid = np.ones((b, t), bool)
    valid[1, t // 3:] = False
    valid_j = jnp.asarray(valid)

    ref = np.asarray(_xla_relpos(q_u, k, v, q_v, p_heads, valid_j,
                                 1.0 / np.sqrt(d)))
    got = np.asarray(fused_relpos_mha(q_u, k, v, q_v, p_heads, valid_j,
                                      block_q=block_q, interpret=True))
    for bi in range(b):
        tv = valid[bi].sum()
        np.testing.assert_allclose(got[bi, :, :tv], ref[bi, :, :tv],
                                   atol=2e-5)


def test_fused_relpos_bf16():
    """bf16 path of the rel-pos kernel (production dtype; the shear runs in
    bf16) vs the fp32 XLA formulation — loose tolerance, mirroring the
    reference's fp16-autocast precision class for this block."""
    from gigaam_tpu.ops.pallas_attention import _xla_relpos, fused_relpos_mha

    b, h, t, d = 2, 4, 128, 48
    rng = np.random.default_rng(6)
    mk = lambda *s: jnp.asarray(
        rng.standard_normal(s).astype(np.float32) * 0.3).astype(jnp.bfloat16)
    q_u, k, v, q_v = (mk(b, h, t, d) for _ in range(4))
    p_heads = mk(h, 2 * t - 1, d)
    valid = jnp.ones((b, t), bool)

    f32 = lambda x: jnp.asarray(np.asarray(x, np.float32))
    ref = np.asarray(_xla_relpos(f32(q_u), f32(k), f32(v), f32(q_v),
                                 f32(p_heads), valid, 1.0 / np.sqrt(d)))
    got = np.asarray(fused_relpos_mha(q_u, k, v, q_v, p_heads, valid,
                                      interpret=True), dtype=np.float32)
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_relpos_mha_fused_matches_plain():
    """relpos_mha(use_fused=True) == the plain XLA relpos path, and grads
    (incl. through the bias -> pos_bias_v/linear_pos) agree."""
    from gigaam_tpu.ops.attention import relpos_mha
    from gigaam_tpu.ops import pallas_attention as pa

    b, t, dm, h = 2, 96, 128, 4
    rng = np.random.default_rng(3)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    lin = lambda i, o: {"w": f32(i, o) * 0.1, "b": f32(o) * 0.1}
    params = {
        "linear_q": lin(dm, dm), "linear_k": lin(dm, dm),
        "linear_v": lin(dm, dm), "linear_out": lin(dm, dm),
        "linear_pos": {"w": f32(dm, dm) * 0.1},
        "pos_bias_u": f32(h, dm // h) * 0.1,
        "pos_bias_v": f32(h, dm // h) * 0.1,
    }
    x = f32(b, t, dm)
    pos = f32(2 * t - 1, dm)
    valid = np.ones((b, t), bool)
    valid[1, 60:] = False
    valid_j = jnp.asarray(valid)
    vq = jnp.asarray(valid, np.float32)[:, :, None]

    # interpret mode so the Pallas path runs on the CPU test platform
    orig = pa._fused_relpos_fwd_only
    fwd = lambda q_u, k, v, q_v, ph, vb, block_q, interpret: orig(
        q_u, k, v, q_v, ph, vb, block_q, True)

    def loss(p, fused):
        out = relpos_mha(p, x, pos, valid_j, h, use_fused=fused)
        return jnp.sum((out * vq) ** 2)

    try:
        pa.__dict__["_saved"] = pa._fused_relpos_fwd_only
        pa._fused_relpos_fwd_only = fwd
        ref, gref = jax.value_and_grad(loss)(params, False)
        got, ggot = jax.value_and_grad(loss)(params, True)
    finally:
        pa._fused_relpos_fwd_only = pa.__dict__.pop("_saved")

    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    for kk in params:
        for leaf, (a, b_) in enumerate(zip(jax.tree.leaves(ggot[kk]),
                                           jax.tree.leaves(gref[kk]))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-3, rtol=1e-3,
                                       err_msg=f"{kk}[{leaf}]")


def test_fused_kernels_shard_over_mesh(monkeypatch):
    """Under pjit over a Mesh the kernels must partition over (batch, head)
    — not silently all-gather and replicate (the default for a bare
    pallas_call).  Verifies output sharding and numerics for batch-DP and
    head-TP on the 8-device host mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gigaam_tpu.ops import pallas_attention as pa

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")

    # route the kernels through interpret mode on CPU
    om, orp = pa._mha_pallas, pa._relpos_pallas
    monkeypatch.setattr(pa, "_mha_pallas",
                        lambda q, k, v, m, bq, it: om(q, k, v, m, bq, True))
    monkeypatch.setattr(pa, "_relpos_pallas",
                        lambda *a: orp(*a[:7], True))
    pa._partitioned_mha.cache_clear()
    pa._partitioned_relpos.cache_clear()

    b, h, t, d = 8, 4, 128, 48
    rng = np.random.default_rng(7)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    q, k, v, qv = (f32(b, h, t, d) for _ in range(4))
    ph = f32(h, 2 * t - 1, d)
    valid = jnp.ones((b, t), bool)

    ref_mha = np.asarray(pa.fused_mha(q, k, v, valid, interpret=True))
    ref_rp = np.asarray(pa.fused_relpos_mha(q, k, v, qv, ph, valid,
                                            interpret=True))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model"))
    dp = NamedSharding(mesh, P("data"))
    dptp = NamedSharding(mesh, P("data", "model"))
    qs, ks, vs, qvs = (jax.device_put(x, dptp) for x in (q, k, v, qv))
    phs = jax.device_put(ph, NamedSharding(mesh, P("model")))
    vals = jax.device_put(valid, dp)

    out = jax.jit(pa.fused_mha)(qs, ks, vs, vals)
    assert out.sharding.spec == P("data", "model"), out.sharding
    np.testing.assert_allclose(np.asarray(out), ref_mha, atol=1e-5)

    out2 = jax.jit(pa.fused_relpos_mha)(qs, ks, vs, qvs, phs, vals)
    assert out2.sharding.spec == P("data", "model"), out2.sharding
    np.testing.assert_allclose(np.asarray(out2), ref_rp, atol=1e-5)

    pa._partitioned_mha.cache_clear()
    pa._partitioned_relpos.cache_clear()


def test_fused_relpos_grad_matches_xla():
    """The rel-pos Pallas backward (shear/unshear in VMEM) must match the
    grads of the XLA formulation for every input incl. the projected
    position table."""
    from gigaam_tpu.ops.pallas_attention import _xla_relpos, fused_relpos_mha

    b, h, t, d = 2, 4, 128, 48
    rng = np.random.default_rng(4)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    q_u, k, v, q_v = (f32(b, h, t, d) for _ in range(4))
    p_heads = f32(h, 2 * t - 1, d)
    valid = np.ones((b, t), bool)
    valid[1, t // 2:] = False
    valid_j = jnp.asarray(valid)
    vq = jnp.asarray(valid, np.float32)[:, None, :, None]  # zero padded rows

    def loss_fused(*a):
        return jnp.sum((fused_relpos_mha(*a, valid_j, interpret=True)
                        * vq) ** 2)

    def loss_xla(*a):
        return jnp.sum((_xla_relpos(*a, valid_j, 1.0 / np.sqrt(d))
                        * vq) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q_u, k, v, q_v,
                                                       p_heads)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(q_u, k, v, q_v, p_heads)
    for name, a, b_ in zip("q_u k v q_v p".split(), gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-3, rtol=1e-3, err_msg=name)


def test_fused_mha_grad_matches_xla():
    """fused_mha must be differentiable (train step on TPU) and its custom
    VJP must match grads of the plain XLA formulation."""
    b, h, t, d = 2, 4, 128, 48
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    valid = np.ones((b, t), bool)
    valid[1, t // 2:] = False
    valid_j = jnp.asarray(valid)
    vq = jnp.asarray(valid, np.float32)[:, None, :, None]  # zero padded rows

    def loss_fused(q, k, v):
        return jnp.sum((fused_mha(q, k, v, valid_j, interpret=True) * vq) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum((_xla_attention(q, k, v, valid_j) * vq) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-3, rtol=1e-3)


def test_folded_rotary_module_matches_composed():
    """The fully-folded attention-module kernel (RoPE + projections + SDPA
    + out-projection in one pallas_call) must match the composed
    rotary_mha path on valid rows, for every nb (rows-per-cell) variant."""
    from gigaam_tpu.ops.attention import rotary_mha
    from gigaam_tpu.ops.pallas_attention import _folded_rotary_pallas
    from gigaam_tpu.ops import pallas_attention as pa
    from gigaam_tpu.ops.rotary import rotary_tables

    b, t, dm, h = 4, 96, 128, 4
    dh = dm // h
    rng = np.random.default_rng(7)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    lin = lambda i, o: {"w": f32(i, o) * 0.1, "b": f32(o) * 0.1}
    params = {"linear_q": lin(dm, dm), "linear_k": lin(dm, dm),
              "linear_v": lin(dm, dm), "linear_out": lin(dm, dm)}
    x = f32(b, t, dm) * 0.5
    cos_np, sin_np = rotary_tables(t, dh, 5000.0)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    valid = np.ones((b, t), bool)
    valid[1, 60:] = False
    valid[3, 10:] = False
    valid_j = jnp.asarray(valid)

    ref = np.asarray(rotary_mha(params, x, cos, sin, valid_j, h,
                                use_fused=False))

    scale = 1.0 / np.sqrt(dh)
    cos_w = jnp.tile(cos, (1, h))
    sin_w = jnp.tile(sin, (1, h))
    r = jnp.asarray(pa._rope_perm_matrix(h, dh))
    args = (cos_w, sin_w, r,
            params["linear_q"]["w"] * scale, params["linear_k"]["w"],
            params["linear_v"]["w"], params["linear_out"]["w"],
            (params["linear_q"]["b"] * scale)[None, :],
            params["linear_k"]["b"][None, :],
            params["linear_v"]["b"][None, :],
            params["linear_out"]["b"][None, :])
    for nb in (1, 2, 4):
        got = np.asarray(_folded_rotary_pallas(
            x, *args, valid_j, nb, h, interpret=True))
        for bi in range(b):
            tv = valid[bi].sum()
            np.testing.assert_allclose(
                got[bi, :tv], ref[bi, :tv], atol=2e-4, rtol=2e-4,
                err_msg=f"nb={nb} b={bi}")


def test_folded_lnres_matches_composed():
    """The LN + attention + residual kernel must match
    ``x + rotary_mha(layer_norm(x))`` on valid rows for every nb variant
    (the fp32 in-kernel LN/residual vs the composed fp32 LN are the same
    math; only bf16-level blocking differences remain)."""
    from gigaam_tpu.ops.attention import rotary_mha
    from gigaam_tpu.ops.conformer_ops import layer_norm
    from gigaam_tpu.ops.pallas_attention import (
        _folded_lnres_pallas,
        _rope_perm_matrix,
    )
    from gigaam_tpu.ops.rotary import rotary_tables

    b, t, dm, h = 4, 96, 128, 4
    dh = dm // h
    rng = np.random.default_rng(11)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    lin = lambda i, o: {"w": f32(i, o) * 0.1, "b": f32(o) * 0.1}
    params = {"linear_q": lin(dm, dm), "linear_k": lin(dm, dm),
              "linear_v": lin(dm, dm), "linear_out": lin(dm, dm)}
    ln_p = {"scale": 1.0 + 0.1 * f32(dm), "bias": 0.1 * f32(dm)}
    x = f32(b, t, dm) * 0.5
    cos_np, sin_np = rotary_tables(t, dh, 5000.0)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    valid = np.ones((b, t), bool)
    valid[1, 60:] = False
    valid_j = jnp.asarray(valid)

    ref = np.asarray(x + rotary_mha(params, layer_norm(ln_p, x), cos, sin,
                                    valid_j, h, use_fused=False))

    scale = 1.0 / np.sqrt(dh)
    args = (ln_p["scale"][None, :], ln_p["bias"][None, :],
            jnp.tile(cos, (1, h)), jnp.tile(sin, (1, h)),
            jnp.asarray(_rope_perm_matrix(h, dh)),
            params["linear_q"]["w"] * scale, params["linear_k"]["w"],
            params["linear_v"]["w"], params["linear_out"]["w"],
            (params["linear_q"]["b"] * scale)[None, :],
            params["linear_k"]["b"][None, :],
            params["linear_v"]["b"][None, :],
            params["linear_out"]["b"][None, :])
    for nb in (1, 2, 4):
        got = np.asarray(_folded_lnres_pallas(
            x, *args, valid_j, nb, h, interpret=True))
        for bi in range(b):
            tv = valid[bi].sum()
            np.testing.assert_allclose(
                got[bi, :tv], ref[bi, :tv], atol=5e-4, rtol=5e-4,
                err_msg=f"nb={nb} b={bi}")


def test_folded_lnres_public_wrapper_and_mesh():
    """folded_rotary_attention_lnres end to end in interpret mode, plus
    sharded execution under a data-parallel mesh."""
    from gigaam_tpu.ops.attention import rotary_mha
    from gigaam_tpu.ops.conformer_ops import layer_norm
    from gigaam_tpu.ops.pallas_attention import folded_rotary_attention_lnres
    from gigaam_tpu.ops.rotary import rotary_tables

    b, t, dm, h = 8, 64, 128, 4
    rng = np.random.default_rng(12)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    lin = lambda i, o: {"w": f32(i, o) * 0.1, "b": f32(o) * 0.1}
    params = {"linear_q": lin(dm, dm), "linear_k": lin(dm, dm),
              "linear_v": lin(dm, dm), "linear_out": lin(dm, dm)}
    ln_p = {"scale": 1.0 + 0.1 * f32(dm), "bias": 0.1 * f32(dm)}
    x = f32(b, t, dm) * 0.5
    cos_np, sin_np = rotary_tables(t, dm // h, 5000.0)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    valid = np.ones((b, t), bool)
    valid[2, 40:] = False
    valid_j = jnp.asarray(valid)

    ref = np.asarray(x + rotary_mha(params, layer_norm(ln_p, x), cos, sin,
                                    valid_j, h, use_fused=False))
    got = np.asarray(folded_rotary_attention_lnres(
        ln_p, params, x, cos, sin, valid_j, h, interpret=True))
    for bi in range(b):
        tv = valid[bi].sum()
        np.testing.assert_allclose(got[bi, :tv], ref[bi, :tv],
                                   atol=5e-4, rtol=5e-4)

    import jax as _jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devs = _jax.devices()
    if len(devs) >= 2:
        mesh = Mesh(np.array(devs[:2]), ("data",))
        xs = _jax.device_put(
            x, NamedSharding(mesh, PartitionSpec("data", None, None)))
        vs = _jax.device_put(
            valid_j, NamedSharding(mesh, PartitionSpec("data", None)))
        with mesh:
            out = _jax.jit(lambda xx, vv: folded_rotary_attention_lnres(
                ln_p, params, xx, cos, sin, vv, h, interpret=True))(xs, vs)
        for bi in range(b):
            tv = valid[bi].sum()
            np.testing.assert_allclose(np.asarray(out)[bi, :tv],
                                       ref[bi, :tv], atol=5e-4, rtol=5e-4)


def test_folded_rotary_public_wrapper_and_mesh(monkeypatch):
    """folded_rotary_attention end to end (wide-table build, weight
    prescale, nb clamp) in interpret mode, plus sharded execution under a
    data-parallel mesh (custom_partitioning path)."""
    from gigaam_tpu.ops.attention import rotary_mha
    from gigaam_tpu.ops.pallas_attention import folded_rotary_attention
    from gigaam_tpu.ops.rotary import rotary_tables

    b, t, dm, h = 8, 64, 128, 4
    rng = np.random.default_rng(8)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    lin = lambda i, o: {"w": f32(i, o) * 0.1, "b": f32(o) * 0.1}
    params = {"linear_q": lin(dm, dm), "linear_k": lin(dm, dm),
              "linear_v": lin(dm, dm), "linear_out": lin(dm, dm)}
    x = f32(b, t, dm) * 0.5
    cos_np, sin_np = rotary_tables(t, dm // h, 5000.0)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    valid = np.ones((b, t), bool)
    valid[2, 40:] = False
    valid_j = jnp.asarray(valid)

    ref = np.asarray(rotary_mha(params, x, cos, sin, valid_j, h,
                                use_fused=False))
    got = np.asarray(folded_rotary_attention(params, x, cos, sin, valid_j,
                                             h, interpret=True))
    for bi in range(b):
        tv = valid[bi].sum()
        np.testing.assert_allclose(got[bi, :tv], ref[bi, :tv],
                                   atol=2e-4, rtol=2e-4)

    # sharded over a data-parallel mesh: output must stay b-sharded and
    # numerically identical
    import jax as _jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devs = _jax.devices()
    if len(devs) >= 2:
        mesh = Mesh(np.array(devs[:2]), ("data",))
        xs = _jax.device_put(
            x, NamedSharding(mesh, PartitionSpec("data", None, None)))
        vs = _jax.device_put(
            valid_j, NamedSharding(mesh, PartitionSpec("data", None)))
        with mesh:
            out = _jax.jit(lambda xx, vv: folded_rotary_attention(
                params, xx, cos, sin, vv, h, interpret=True))(xs, vs)
        for bi in range(b):
            tv = valid[bi].sum()
            np.testing.assert_allclose(np.asarray(out)[bi, :tv],
                                       ref[bi, :tv], atol=2e-4, rtol=2e-4)
