import time
import jax, jax.numpy as jnp
from jax import lax

B, H, W, CI, CO = 8, 16, 16, 41, 16
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, H, W, CI), jnp.float32)
w = jax.random.normal(key, (CI, 2, 2, CO), jnp.float32)

def via_einsum(x, w):
    t = jnp.einsum("bhwi,iklo->bhkwlo", x, w, preferred_element_type=x.dtype)
    return t.reshape(x.shape[0], 2*x.shape[1], 2*x.shape[2], w.shape[-1])

def via_convt_flip(x, w):
    wt = w.transpose(1, 2, 0, 3)[::-1, ::-1]
    return lax.conv_transpose(x, wt, strides=(2, 2), padding="VALID",
                              dimension_numbers=("NHWC", "HWIO", "NHWC"))

def via_convt_tk(x, w):
    # transpose_kernel=True flips spatial dims and swaps I/O: expects IOHW->?
    wt = w.transpose(1, 2, 3, 0)  # HWOI
    return lax.conv_transpose(x, wt, strides=(2, 2), padding="VALID",
                              dimension_numbers=("NHWC", "HWIO", "NHWC"),
                              transpose_kernel=True)

a = via_einsum(x, w)
for name, f in [("flip", via_convt_flip), ("tk", via_convt_tk)]:
    try:
        b = f(x, w)
        print(name, "max abs diff:", float(jnp.max(jnp.abs(a - b))))
    except Exception as e:
        print(name, "error:", e)
