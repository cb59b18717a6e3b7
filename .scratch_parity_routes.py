import os, jax, jax.numpy as jnp, numpy as np
from sd_animation_optical_flow_tpu.utils.compile_cache import enable_tpu_compile_cache
enable_tpu_compile_cache("/root/repo/.jax_cache")
from sd_animation_optical_flow_tpu.models import unet as U
from sd_animation_optical_flow_tpu.models.layers import cast_tree, numpy_init
DT = jnp.bfloat16
ucfg = U.UNetConfig()
with jax.default_device(jax.local_devices(backend="cpu")[0]), numpy_init(DT):
    p = U.unet_init(jax.random.PRNGKey(0), ucfg)
p['out']['conv']['w'] = jnp.asarray(
    np.random.default_rng(7).standard_normal(p['out']['conv']['w'].shape) * 0.02, DT)
p = jax.device_put(cast_tree(p, DT), jax.devices()[0])
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((2, 64, 96, 4)), DT)
t = jnp.full((2,), 500, jnp.int32)
ctx = jnp.asarray(rng.standard_normal((2, 231, 768)) * 0.1, DT)

def run():
    return np.asarray(jax.jit(lambda p, x, t, c: U.unet_apply(p, ucfg, x, t, c)[0])(p, x, t, ctx), np.float32)

out_kern = run()
os.environ["SDAOF_FLASH"] = "0"; os.environ["SDAOF_FUSED_FF"] = "0"
os.environ["SDAOF_FUSED_LNPROJ"] = "0"
jax.clear_caches()
out_xla = run()
d = np.abs(out_kern - out_xla)
print("max abs diff:", d.max(), " mean:", d.mean(), " out scale:", np.abs(out_xla).max())
