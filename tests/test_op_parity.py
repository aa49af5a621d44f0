"""Numerical parity of layout-sensitive ops vs torch primitives.

These pin down exactly the places where a checkpoint-conversion transpose
could silently go wrong: convs, LSTM gate packing, norms, attention math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from gigaam_tpu.ops.conformer_ops import (  # noqa: E402
    batch_norm_infer,
    batch_norm_train,
    depthwise_conv1d,
    layer_norm,
    linear,
    striding_subsampling_conv2d,
    subsampled_length,
)
from gigaam_tpu.ops.lstm import lstm_sequence  # noqa: E402
from gigaam_tpu.ops.attention import rel_shift  # noqa: E402

RNG = np.random.default_rng(42)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def test_linear_matches_torch():
    x = RNG.standard_normal((2, 5, 16)).astype(np.float32)
    w = RNG.standard_normal((8, 16)).astype(np.float32)  # torch [out, in]
    b = RNG.standard_normal(8).astype(np.float32)
    ref = torch.nn.functional.linear(_t(x), _t(w), _t(b)).numpy()
    ours = linear({"w": jnp.asarray(w.T), "b": jnp.asarray(b)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_depthwise_conv_matches_torch():
    d, k, t = 12, 31, 50
    x = RNG.standard_normal((2, t, d)).astype(np.float32)
    w = RNG.standard_normal((d, 1, k)).astype(np.float32)  # torch [C,1,K]
    b = RNG.standard_normal(d).astype(np.float32)
    ref = torch.nn.functional.conv1d(
        _t(x).transpose(1, 2), _t(w), _t(b), padding=(k - 1) // 2, groups=d
    ).transpose(1, 2).numpy()
    ours = depthwise_conv1d(
        jnp.asarray(w.transpose(2, 1, 0)), jnp.asarray(b), jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_subsampling_conv2d_matches_torch():
    """Two stride-2 conv2d stages + ReLU + channel-major flatten + Linear,
    including per-stage tail re-masking (``gigaam/encoder.py:92-130``)."""
    f_in, c, d_out, t = 8, 6, 10, 21
    w0 = RNG.standard_normal((c, 1, 3, 3)).astype(np.float32) * 0.3
    b0 = RNG.standard_normal(c).astype(np.float32)
    w1 = RNG.standard_normal((c, c, 3, 3)).astype(np.float32) * 0.3
    b1 = RNG.standard_normal(c).astype(np.float32)
    f_out = f_in
    for _ in range(2):
        f_out = (f_out - 1) // 2 + 1
    wl = RNG.standard_normal((d_out, c * f_out)).astype(np.float32) * 0.3
    bl = RNG.standard_normal(d_out).astype(np.float32)

    feats = RNG.standard_normal((2, t, f_in)).astype(np.float32)
    lengths = np.array([t, t - 6], dtype=np.int32)

    # torch reference computation (mirrors StridingSubsampling.forward)
    xt = _t(feats).unsqueeze(1)  # [B,1,T,F]
    cur = _t(lengths).float()

    def mask4(x, lens):
        tt = torch.arange(x.shape[2])
        pad = tt[None, :] >= lens[:, None].long()
        return x.masked_fill(pad[:, None, :, None], 0.0)

    xt = mask4(xt, cur)
    for wi, bi in [(w0, b0), (w1, b1)]:
        xt = torch.nn.functional.conv2d(xt, _t(wi), _t(bi), stride=2, padding=1)
        xt = torch.relu(xt)
        cur = torch.floor((cur - 1) / 2 + 1.0)
        xt = mask4(xt, cur)
    bsz, _, tt_, _ = xt.shape
    flat = xt.transpose(1, 2).reshape(bsz, tt_, -1)  # [b, t, C*f]
    ref = torch.nn.functional.linear(flat, _t(wl), _t(bl)).numpy()

    params = {
        "conv_0": {"w": jnp.asarray(w0.transpose(2, 3, 1, 0)),
                   "b": jnp.asarray(b0)},
        "conv_1": {"w": jnp.asarray(w1.transpose(2, 3, 1, 0)),
                   "b": jnp.asarray(b1)},
        "out": {"w": jnp.asarray(wl.T), "b": jnp.asarray(bl)},
    }
    ours, out_len = striding_subsampling_conv2d(
        params, jnp.asarray(feats), jnp.asarray(lengths), num_stages=2)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(out_len),
        torch.floor((torch.floor((_t(lengths).float() - 1) / 2 + 1) - 1) / 2 + 1)
        .int().numpy(),
    )


def test_subsampled_length_formula():
    lens = jnp.asarray([98, 101, 1, 3, 2501])
    got = np.asarray(subsampled_length(lens, 2))
    # reference formula: floor((l - 1)/2 + 1) twice (pad=1, k=3, stride=2)
    exp = []
    for l in [98, 101, 1, 3, 2501]:
        for _ in range(2):
            l = int(np.floor((l - 1) / 2 + 1))
        exp.append(l)
    np.testing.assert_array_equal(got, exp)


def test_lstm_matches_torch():
    torch.manual_seed(0)
    b, t, h, n_layers = 3, 7, 16, 2
    ref_lstm = torch.nn.LSTM(h, h, n_layers)
    x = RNG.standard_normal((b, t, h)).astype(np.float32)
    with torch.no_grad():
        ref_out, (ref_h, ref_c) = ref_lstm(_t(x).transpose(0, 1))
    ref_out = ref_out.transpose(0, 1).numpy()

    layers = []
    for li in range(n_layers):
        w_ih = getattr(ref_lstm, f"weight_ih_l{li}").detach().numpy()
        w_hh = getattr(ref_lstm, f"weight_hh_l{li}").detach().numpy()
        b_ih = getattr(ref_lstm, f"bias_ih_l{li}").detach().numpy()
        b_hh = getattr(ref_lstm, f"bias_hh_l{li}").detach().numpy()
        layers.append({"w_ih": jnp.asarray(w_ih.T), "w_hh": jnp.asarray(w_hh.T),
                       "b": jnp.asarray(b_ih + b_hh)})
    h0 = jnp.zeros((n_layers, b, h))
    out, hT, cT = lstm_sequence(layers, jnp.asarray(x), h0, h0)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), ref_h.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), ref_c.numpy(), atol=1e-5)


def test_batch_norm_matches_torch():
    c = 10
    x = RNG.standard_normal((4, 9, c)).astype(np.float32)
    scale = RNG.standard_normal(c).astype(np.float32)
    bias = RNG.standard_normal(c).astype(np.float32)
    mean = RNG.standard_normal(c).astype(np.float32)
    var = np.abs(RNG.standard_normal(c)).astype(np.float32) + 0.5
    p = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias),
         "mean": jnp.asarray(mean), "var": jnp.asarray(var)}

    # eval mode
    ref = torch.nn.functional.batch_norm(
        _t(x).transpose(1, 2), _t(mean), _t(var), _t(scale), _t(bias),
        training=False, eps=1e-5).transpose(1, 2).numpy()
    ours = batch_norm_infer(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    # train mode (+ running stats update, momentum 0.1)
    rm, rv = _t(mean).clone(), _t(var).clone()
    ref_t = torch.nn.functional.batch_norm(
        _t(x).transpose(1, 2), rm, rv, _t(scale), _t(bias),
        training=True, momentum=0.1, eps=1e-5).transpose(1, 2).numpy()
    ours_t, new_stats = batch_norm_train(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours_t), ref_t, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_stats["mean"]), rm.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_stats["var"]), rv.numpy(),
                               atol=1e-4)


def test_layer_norm_matches_torch():
    d = 16
    x = RNG.standard_normal((2, 5, d)).astype(np.float32)
    scale = RNG.standard_normal(d).astype(np.float32)
    bias = RNG.standard_normal(d).astype(np.float32)
    ref = torch.nn.functional.layer_norm(
        _t(x), (d,), _t(scale), _t(bias), eps=1e-5).numpy()
    ours = layer_norm({"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
                      jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_rel_shift_matches_reference_trick():
    """rel_shift via torch pad/view ops (``gigaam/encoder.py:202-206``)."""
    b, h, q = 2, 3, 5
    p = 2 * q - 1
    x = RNG.standard_normal((b, h, q, p)).astype(np.float32)
    xt = torch.nn.functional.pad(_t(x), pad=(1, 0))
    xt = xt.view(b, h, -1, q)
    ref = xt[:, :, 1:].reshape(b, h, q, p).numpy()
    ours = rel_shift(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=0)


def test_sdpa_matches_our_attention_core():
    """Masked softmax-attention core vs torch SDPA with bool mask."""
    from gigaam_tpu.ops.attention import _masked_softmax

    b, h, t, d = 2, 4, 9, 8
    q = RNG.standard_normal((b, h, t, d)).astype(np.float32)
    k = RNG.standard_normal((b, h, t, d)).astype(np.float32)
    v = RNG.standard_normal((b, h, t, d)).astype(np.float32)
    valid = np.ones((b, t), dtype=bool)
    valid[1, 6:] = False

    pair = valid[:, None, None, :] & valid[:, None, :, None]
    ref = torch.nn.functional.scaled_dot_product_attention(
        _t(q), _t(k), _t(v), attn_mask=_t(pair)).numpy()

    scores = jnp.einsum("bhqd,bhkd->bhqk", jnp.asarray(q), jnp.asarray(k))
    scores = scores / np.sqrt(d)
    attn = _masked_softmax(scores, jnp.asarray(valid))
    ours = np.asarray(jnp.einsum("bhqk,bhkd->bhqd", attn, jnp.asarray(v)))
    # compare only valid query rows (SDPA emits NaN on fully-masked rows)
    for bi in range(b):
        tv = valid[bi].sum()
        np.testing.assert_allclose(ours[bi, :, :tv], ref[bi, :, :tv], atol=1e-5)


def test_apply_rotary_wide_equals_per_head():
    """The flat-layout RoPE (full-lane elementwise + static gather, used by
    rotary_mha) must equal the per-head [B, T, H, d] formulation exactly —
    and the torch reference semantics transitively (whole-model parity in
    test_reference_torch_parity.py runs through apply_rotary_wide)."""
    from gigaam_tpu.ops.rotary import (apply_rotary, apply_rotary_wide,
                                       rotary_tables)

    b, t, h, d = 3, 17, 4, 12
    cos, sin = rotary_tables(t, d, base=64.0)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    x = jnp.asarray(RNG.standard_normal((b, t, h * d)).astype(np.float32))
    want = apply_rotary(x.reshape(b, t, h, d), cos, sin).reshape(b, t, h * d)
    got = apply_rotary_wide(x, cos, sin, h)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
