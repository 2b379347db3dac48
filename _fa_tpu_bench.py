import numpy as np, jax, jax.numpy as jnp, time
from clip_fsar_tpu.ops.attention import mha
from clip_fsar_tpu.ops.flash_attention import flash_mha
rng = np.random.RandomState(0)
for (B,H,N,D) in [(480, 12, 197, 64), (96, 16, 577, 64)]:
    q = jnp.asarray(rng.randn(B,H,N,D).astype(np.float32), dtype=jnp.bfloat16)
    ref = jax.jit(lambda a,b,c: mha(a,b,c,backend="xla"))
    fl  = jax.jit(lambda a,b,c: flash_mha(a,b,c))
    r = ref(q,q,q); f = fl(q,q,q)
    jax.block_until_ready((r,f))
    err = np.abs(np.asarray(r,np.float32)-np.asarray(f,np.float32)).max()
    for name, fn in [("xla", ref), ("pallas", fl)]:
        t0=time.perf_counter()
        for _ in range(10): out = fn(q,q,q)
        jax.block_until_ready(out)
        print(f"{B}x{H}x{N}x{D} {name}: {(time.perf_counter()-t0)/10*1000:.2f} ms", "maxerr" , err if name=="pallas" else "")
