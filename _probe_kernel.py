import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from image_restoration_agent_tpu.ops.pallas_attention import swin_strip_pallas
from image_restoration_agent_tpu.ops.window_attention import shift_attention_mask

C, HEADS, WS = 180, 6, 8
H, W = 552, 1920
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (1, H, W, C), jnp.bfloat16)
ln = jnp.ones((C,), jnp.float32); lnb = jnp.zeros((C,), jnp.float32)
wqkv = jax.random.normal(key, (C, 3*C), jnp.bfloat16)*0.02
bqkv = jnp.zeros((3*C,), jnp.float32)
wproj = jax.random.normal(key, (C, C), jnp.bfloat16)*0.02
bproj = jnp.zeros((C,), jnp.float32)
rpb = jax.random.normal(key, (HEADS, 64, 64), jnp.float32)
mlp = (jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),
       jax.random.normal(key, (C, 2*C), jnp.bfloat16)*0.02, jnp.zeros((2*C,), jnp.float32),
       jax.random.normal(key, (2*C, C), jnp.bfloat16)*0.02, jnp.zeros((C,), jnp.float32))
bank = jnp.asarray(shift_attention_mask(16, 16, 8, 4).reshape(2,2,64,64))

for name, kw in [("dc0", dict(dc=0)),
                 ("dc+4", dict(dc=4)),
                 ("dc-4 bank", dict(dc=-4, mask_bank=bank))]:
    t0 = time.time()
    out = swin_strip_pallas(x, ln, lnb, wqkv, bqkv, wproj, bproj, rpb, None,
                            num_heads=HEADS, ws=WS, mlp=mlp, **kw)
    out.block_until_ready()
    t1 = time.time()
    # timed run
    for _ in range(3):
        t2 = time.time()
        swin_strip_pallas(x, ln, lnb, wqkv, bqkv, wproj, bproj, rpb, None,
                          num_heads=HEADS, ws=WS, mlp=mlp, **kw).block_until_ready()
    print(f"{name}: compile+run {t1-t0:.1f}s, steady {time.time()-t2:.4f}s", flush=True)
