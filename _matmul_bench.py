import time, numpy as np, jax, jax.numpy as jnp

def bench(f, *a, n=5):
    _ = np.asarray(f(*a).ravel()[0])
    ts = []
    for _i in range(n):
        t0 = time.perf_counter(); _ = np.asarray(f(*a).ravel()[0]); ts.append(time.perf_counter() - t0)
    return min(ts)

N = 8192
a = jnp.asarray(np.random.rand(N, N).astype(np.float32)).astype(jnp.bfloat16)
b = jnp.asarray(np.random.rand(N, N).astype(np.float32)).astype(jnp.bfloat16)

@jax.jit
def mm(a, b):
    # chain 8 matmuls to amortize dispatch
    x = a
    for _ in range(8):
        x = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
    return x

dt = bench(mm, a, b)
fl = 8 * 2 * N**3
print(f"matmul chain: {dt*1000:.1f} ms -> {fl/dt/1e12:.1f} TF/s (peak v5e ~197)")

# conv benchmark
x = jnp.asarray(np.random.rand(8, 256, 256, 256).astype(np.float32)).astype(jnp.bfloat16)
w = jnp.asarray(np.random.rand(3, 3, 256, 256).astype(np.float32)).astype(jnp.bfloat16)

@jax.jit
def convs(x, w):
    for _ in range(8):
        x = jax.lax.conv_general_dilated(x, w, (1,1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x
dt = bench(convs, x, w)
fl = 8 * 2 * 8*256*256*256*256*9
print(f"conv chain: {dt*1000:.1f} ms -> {fl/dt/1e12:.1f} TF/s")
