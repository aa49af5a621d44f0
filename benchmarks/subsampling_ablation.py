"""Subsampling decomposition: where do the 5.4 ms (b8 x 20 s) go?

Pieces measured standalone on the chip (all bf16):
  stage1: conv2d 3x3 s2, 1 -> 768 channels     [8,2000,64,1] -> [8,1000,32,768]
  mask+relu on the stage-1 output (394 MB)
  stage2: conv2d 3x3 s2, 768 -> 768            -> [8,500,16,768]
  stage2_im2col: same math as 9 strided-slice matmuls (contraction 768)
  linear: [8,500,12288] @ [12288,768]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gigaam_tpu.profiling import device_timeit

B, T, F, D = 8, 2000, 64, 768


def main():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(0.1 * rng.standard_normal((B, T, F, 1)), jnp.bfloat16)
    w1 = jnp.asarray(0.1 * rng.standard_normal((3, 3, 1, D)), jnp.bfloat16)
    w2 = jnp.asarray(0.02 * rng.standard_normal((3, 3, D, D)), jnp.bfloat16)
    wl = jnp.asarray(0.02 * rng.standard_normal((D * (F // 4), D)),
                     jnp.bfloat16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x1 = jax.jit(lambda x: jax.nn.relu(conv(x, w1)))(feats)  # [8,1000,32,768]
    x2 = jax.jit(lambda x: jax.nn.relu(conv(x, w2)))(x1)     # [8,500,16,768]

    res = {}

    us = device_timeit(lambda x: conv(x, w1), [feats], k=100) * 1e6
    res["stage1_conv_us"] = round(us, 1)
    print("stage1_conv", res["stage1_conv_us"], flush=True)

    us = device_timeit(lambda x: jax.nn.relu(x) * 1.0001, [x1], k=100,
                       chain=True) * 1e6
    res["relu_pass_on_x1_us"] = round(us, 1)
    print("relu_pass_on_x1", res["relu_pass_on_x1_us"], flush=True)

    us = device_timeit(lambda x: conv(x, w2), [x1], k=40) * 1e6
    res["stage2_conv_us"] = round(us, 1)
    print("stage2_conv", res["stage2_conv_us"], flush=True)

    # stage2 as 9 strided-slice matmuls (full-util contraction 768)
    def stage2_im2col(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        t2, f2 = T // 4, F // 4
        acc = None
        for kh in range(3):
            for kw in range(3):
                xs = jax.lax.slice(
                    xp, (0, kh, kw, 0),
                    (B, kh + 2 * t2 - 1, kw + 2 * f2 - 1, D),
                    (1, 2, 2, 1))                   # [B, t2, f2, D]
                y = jnp.einsum("bhwc,cd->bhwd", xs, w2[kh, kw],
                               preferred_element_type=jnp.bfloat16)
                acc = y if acc is None else acc + y
        return acc

    us = device_timeit(stage2_im2col, [x1], k=40) * 1e6
    res["stage2_im2col_us"] = round(us, 1)
    print("stage2_im2col", res["stage2_im2col_us"], flush=True)

    def lin(x):
        b, t2, f2, c = x.shape
        xx = x.transpose(0, 1, 3, 2).reshape(b, t2, c * f2)
        return jnp.einsum("btk,kd->btd", xx, wl,
                          preferred_element_type=jnp.bfloat16)

    us = device_timeit(lin, [x2], k=100) * 1e6
    res["linear_us"] = round(us, 1)
    print("linear", res["linear_us"], flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
