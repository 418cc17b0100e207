"""Probe: dilated 3x3 conv as 9 shifted 1x1 matmuls vs XLA's native
conv emitter, at the R101-OS8 hot shapes (res4 d=2 256ch x23 blocks,
res5 d=4 512ch x3 blocks). Chained-carry timing (see CLAUDE.md timing
trap). Prints per-conv ms and achieved TFLOP/s."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

def native_conv(x, w, d):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((d, d), (d, d)),
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"))

def shifted_conv(x, w, d):
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    acc = None
    for i in range(3):
        for j in range(3):
            xi = lax.dynamic_slice(xp, (0, i * d, j * d, 0), (B, H, W, C))
            y = jnp.einsum("bhwc,co->bhwo", xi, w[i, j],
                           preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    return acc.astype(x.dtype)

ITERS = 50
def bench(fn, x, w, d):
    f = functools.partial(fn, d=d)
    def chain(x, w):
        def body(c, _):
            y = f(c, w)
            return y * jnp.bfloat16(0.01), 0.
        c, _ = lax.scan(body, x, None, length=ITERS)
        return jnp.sum(c.astype(jnp.float32))
    cj = jax.jit(chain)
    float(cj(x, w))  # compile+warm, same program as timed
    best = 1e9
    for _ in range(3):
        t0 = time.time(); float(cj(x, w)); best = min(best, time.time() - t0)
    return best / ITERS * 1e3

shapes = [("res4 d2 256ch", 8, 64, 64, 256, 256, 2),
          ("res5 d4 512ch", 8, 64, 64, 512, 512, 4)]
for name, B, H, W, C, O, d in shapes:
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, H, W, C), jnp.bfloat16)
    w = jax.random.normal(k, (3, 3, C, O), jnp.bfloat16) * 0.05
    a = np.asarray(native_conv(x, w, d), np.float32)
    b = np.asarray(shifted_conv(x, w, d), np.float32)
    err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
    tn = bench(native_conv, x, w, d)
    ts = bench(shifted_conv, x, w, d)
    tf = 2 * B * H * W * C * O * 9 / 1e12
    print(f"{name}: native {tn:.3f} ms ({tf/tn*1e3:.1f} TF/s)  "
          f"shifted {ts:.3f} ms ({tf/ts*1e3:.1f} TF/s)  relerr {err:.2e}",
          flush=True)

def im2col_conv(x, w, d):
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    cols = [lax.dynamic_slice(xp, (0, i * d, j * d, 0), (B, H, W, C))
            for i in range(3) for j in range(3)]
    xc = jnp.concatenate(cols, axis=-1)  # [B,H,W,9C]
    wf = w.reshape(9 * C, -1)
    y = jnp.einsum("bhwk,ko->bhwo", xc, wf,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)

print("--- im2col variant ---", flush=True)
for name, B, H, W, C, O, d in shapes:
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, H, W, C), jnp.bfloat16)
    w = jax.random.normal(k, (3, 3, C, O), jnp.bfloat16) * 0.05
    a = np.asarray(native_conv(x, w, d), np.float32)
    b = np.asarray(im2col_conv(x, w, d), np.float32)
    err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
    t = bench(im2col_conv, x, w, d)
    tf = 2 * B * H * W * C * O * 9 / 1e12
    print(f"{name}: im2col {t:.3f} ms ({tf/t*1e3:.1f} TF/s) relerr {err:.2e}",
          flush=True)
