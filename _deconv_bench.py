import time
import jax, jax.numpy as jnp
import numpy as np
from jax import lax

B, H, W, CI, CO = 128, 256, 256, 41, 16
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, H, W, CI), jnp.bfloat16)
w = jax.random.normal(key, (CI, 2, 2, CO), jnp.bfloat16)

@jax.jit
def via_einsum(x, w):
    t = jnp.einsum("bhwi,iklo->bhkwlo", x, w, preferred_element_type=x.dtype)
    return t.reshape(x.shape[0], 2*x.shape[1], 2*x.shape[2], w.shape[-1])

@jax.jit
def via_convt(x, w):
    # conv_transpose wants [2,2,CI,CO]
    wt = w.transpose(1, 2, 0, 3)
    return lax.conv_transpose(x, wt, strides=(2, 2), padding="VALID",
                              dimension_numbers=("NHWC", "HWIO", "NHWC"))

a = via_einsum(x, w); b = via_convt(x, w)
jax.block_until_ready((a, b))
print("max abs diff:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))))

def timeit(f, n=20):
    r = f(x, w); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(x, w)
    jax.block_until_ready(r)
    # force fetch to beat the tunnel's early return
    float(jnp.sum(r.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1000

print("einsum ms:", timeit(via_einsum))
print("convt  ms:", timeit(via_convt))
