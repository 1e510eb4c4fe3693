import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from image_restoration_agent_tpu.ops.pallas_attention import swin_strip_pallas

C, HEADS, WS = 180, 6, 8
H, W = 552, 1920
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (1, H, W, C), jnp.bfloat16)
ln = jnp.ones((C,), jnp.float32); lnb = jnp.zeros((C,), jnp.float32)
wqkv = jax.random.normal(key, (C, 3*C), jnp.bfloat16)*0.05
bqkv = jnp.zeros((3*C,), jnp.float32)
wproj = jax.random.normal(key, (C, C), jnp.bfloat16)*0.05
bproj = jnp.zeros((C,), jnp.float32)
rpb = jax.random.normal(key, (HEADS, 64, 64), jnp.float32)*0.1
mlp = (jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),
       jax.random.normal(key, (C, 2*C), jnp.bfloat16)*0.05, jnp.zeros((2*C,), jnp.float32),
       jax.random.normal(key, (2*C, C), jnp.bfloat16)*0.05, jnp.zeros((C,), jnp.float32))

kern = lambda xx: swin_strip_pallas(xx, ln, lnb, wqkv, bqkv, wproj, bproj, rpb, None,
                                    num_heads=HEADS, ws=WS, mlp=mlp, dc=0)
out = kern(x); out.block_until_ready()
stats = jax.jit(lambda o: (jnp.isnan(o.astype(jnp.float32)).any(), jnp.abs(o.astype(jnp.float32)).mean()))
nan, mean = stats(out)
print("nan?", bool(nan), "absmean", float(mean), flush=True)

# chunked vs 1D on a 256-wide input (1D path), same windows -> exact match on dc=0 left part? 
x256 = x[:, :, :256, :]
o1 = kern(x256); o1.block_until_ready()
d = jax.jit(lambda a, b: jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())(out[:, :, :256, :], o1)
print("chunked vs 1D-left max diff (dc=0):", float(d), flush=True)

# loop-in-jit timing: chain N calls to defeat any execution caching
def chain(xx, n=10):
    def body(c, _):
        y = kern(c)
        return (y * (1.0/ (1.0 + 1e-6))).astype(c.dtype), None
    y, _ = jax.lax.scan(body, xx, None, length=n)
    return y
cj = jax.jit(chain, static_argnums=1)
y = cj(x, 10); y.block_until_ready()
t0 = time.perf_counter(); y = cj(x, 10); y.block_until_ready()
t = time.perf_counter() - t0
print(f"chained 10 calls: {t*1e3:.1f} ms total -> {t*100:.2f} ms/call", flush=True)
# plain repeated calls with per-call block
ts = []
for _ in range(5):
    t0 = time.perf_counter(); kern(x).block_until_ready(); ts.append(time.perf_counter()-t0)
print("plain per-call ms:", [round(v*1e3,2) for v in ts], flush=True)
