"""A/B one train-step config per process (remote-compile service can't
handle same-signature different-HLO programs in one process)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from pggan_tpu.config import Config
from pggan_tpu.models import init_generator_params, init_discriminator_params
from pggan_tpu.train.step import init_train_state, make_optimizers, make_train_step

impl = sys.argv[1] if len(sys.argv) > 1 else "xla"
scale = int(sys.argv[2]) if len(sys.argv) > 2 else 4
dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
depths = [512, 512, 512, 512, 256, 128, 64]
res = 2 ** (scale + 2)
cfg = Config({"depths": depths, "latent_dim": 512, "compute_dtype": dtype,
              "impl": impl, "donate_buffers": True})
og, od = make_optimizers(cfg)

@jax.jit
def _init(rng):
    kg, kd, ks = jax.random.split(rng, 3)
    pG = init_generator_params(kg, latent_dim=512, depths=depths, scale=scale)
    pD = init_discriminator_params(kd, depths=depths, scale=scale)
    return init_train_state(ks, pG, pD, og, od)

st = _init(jax.random.PRNGKey(0))
jax.block_until_ready(st)
img = jnp.asarray(np.random.RandomState(0).randint(
    0, 256, (16, res, res, 3), dtype=np.uint8))
fn = make_train_step(cfg, scale, og, od)
t0 = time.time()
st, m, _ = fn(st, img, jnp.float32(0.5))
jax.block_until_ready(st)
print(f"compile {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
n = 20
for _ in range(n):
    st, m, _ = fn(st, img, jnp.float32(0.5))
jax.block_until_ready(st)
dt = (time.time()-t0)/n
print(f"impl={impl} scale={scale} {dtype}: {dt*1000:.1f} ms/step = "
      f"{16/dt:.1f} img/s  L_D={float(m['L_D']):.3f}", flush=True)
