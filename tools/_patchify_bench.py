"""Patch-embed input-chain micro-bench (eval-path attack, round 3).

The E=8 eval trace shows a 21 ms `fusion.4` for the uint8 normalize +
space-to-depth + patch GEMM over 1920 frames — ~20x its ~1 ms HBM floor
(289 MB uint8 in, 295 MB bf16 out).  Compares in-jit chained timings of:

  a) current  : normalize -> 6-D reshape/transpose -> [B*196, 588] @ W
  b) direct   : dot_general contracting (p, p, c) straight off the 6-D
                view (no materialized transpose)
  c) folded   : normalize algebra absorbed into kernel/bias
                (x @ W' + b', W' = W/(255*std) rows, b' = -(mean/std)@W),
                so the chain is uint8 cast -> transpose -> GEMM
  d) folded+direct : (b) and (c) combined

All variants produce the same [B, 196, 768] activation (parity asserted
to bf16 tolerance before timing).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, R, P, W = 1920, 224, 16, 768
MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
STEPS = 20


def chained(fn, x, steps=STEPS):
    def body(c, _):
        o = fn(c)
        return c + o[0, 0, 0].astype(c.dtype), None  # uint8 add wraps mod 256

    run = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=steps)[0][0, 0, 0, 0].astype(jnp.float32))
    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0) / steps * 1000


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 256, (B, R, R, 3), dtype=np.uint8))
    kern = jnp.asarray(rng.randn(P, P, 3, W).astype(np.float32) * 0.02)
    g = R // P

    def normalize(img):
        f = img.astype(jnp.float32) / 255.0
        return (f - MEAN) / STD

    def s2d(img):  # [B,R,R,3] -> [B,196,588]
        return img.reshape(B, g, P, g, P, 3).transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, P * P * 3)

    def a_current(img):
        pat = s2d(normalize(img).astype(jnp.bfloat16))
        return jnp.dot(pat, kern.reshape(P * P * 3, W).astype(jnp.bfloat16))

    def b_direct(img):
        x6 = normalize(img).astype(jnp.bfloat16).reshape(B, g, P, g, P, 3)
        out = jax.lax.dot_general(
            x6, kern.astype(jnp.bfloat16), (((2, 4, 5), (0, 1, 2)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, g, g, W]
        return out.astype(jnp.bfloat16).reshape(B, g * g, W)

    # normalize folded into the GEMM: x@W' + b'
    kern_f = (kern / (255.0 * STD)[None, None, :, None]).astype(jnp.float32)
    # the bias sums -mean/std over every (p, q, c) tap of the kernel
    bias_f = -jnp.einsum("pqcw,c->w", kern, jnp.asarray(MEAN / STD))

    def c_folded(img):
        pat = s2d(img.astype(jnp.bfloat16))
        out = jnp.dot(pat, kern_f.reshape(P * P * 3, W).astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return (out + bias_f).astype(jnp.bfloat16)

    def d_folded_direct(img):
        x6 = img.astype(jnp.bfloat16).reshape(B, g, P, g, P, 3)
        out = jax.lax.dot_general(
            x6, kern_f.astype(jnp.bfloat16), (((2, 4, 5), (0, 1, 2)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (out.reshape(B, g * g, W) + bias_f).astype(jnp.bfloat16)

    ref = np.asarray(jax.jit(a_current)(x), np.float32)
    for name, fn in (("b_direct", b_direct), ("c_folded", c_folded), ("d_folded_direct", d_folded_direct)):
        got = np.asarray(jax.jit(fn)(x), np.float32)
        err = np.abs(got - ref).max()
        print(f"{name}: max|diff| = {err:.4f}")
        assert err < 0.35, f"{name} diverges"  # bf16 patch sums ~O(10)

    for name, fn in (
        ("a_current      ", a_current),
        ("b_direct       ", b_direct),
        ("c_folded       ", c_folded),
        ("d_folded_direct", d_folded_direct),
    ):
        print(f"{name}: {chained(fn, x):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
