import sys; sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/tmp/dcn_old")
import importlib.util, time, jax, jax.numpy as jnp
spec = importlib.util.spec_from_file_location("dcn_old", "/tmp/dcn_old/dcn_kernel_old.py")
old = importlib.util.module_from_spec(spec); spec.loader.exec_module(old)
from gaussianformer_tpu.ops.pallas import dcn_kernel as new

key = jax.random.PRNGKey(0)
b, h, w, c = 6, 54, 100, 256
x = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
off = jax.random.normal(key, (b, h, w, 18), jnp.float32) * 2.0
msk = jax.nn.sigmoid(jax.random.normal(key, (b, h, w, 9), jnp.float32))
wgt = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.05
for name, mod in [("old", old), ("new", new)]:
    f = jax.jit(mod.deform_conv2d_pallas_fwd)
    o = f(x, off, msk, wgt); jax.device_get(o[0,0,0,:2])
    n = 30; t0 = time.perf_counter()
    for _ in range(n): o = f(x, off, msk, wgt)
    jax.device_get(o[0,0,0,:2])
    print(f"{name} fwd: {(time.perf_counter()-t0)/n*1e3:.2f} ms")
