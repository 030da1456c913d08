import time, sys
import numpy as np
import jax, jax.numpy as jnp
from pggan_tpu.config import Config
from pggan_tpu.models import (init_generator_params, init_discriminator_params,
                              generator_apply, discriminator_apply)
from pggan_tpu.losses.gan import bce_with_logits, r1_penalty, generator_loss

scale = 6
depths = [512, 512, 512, 512, 256, 128, 64]
res = 2 ** (scale + 2)
B = 16
dt = jnp.bfloat16

kg, kd = jax.random.split(jax.random.PRNGKey(0))
pG = init_generator_params(kg, latent_dim=512, depths=depths, scale=scale)
pD = init_discriminator_params(kd, depths=depths, scale=scale)
jax.block_until_ready((pG, pD))
z = jnp.zeros((B, 512), jnp.float32)
img = jnp.asarray(np.random.RandomState(0).randn(B, res, res, 3), jnp.float32)
a = jnp.float32(0.5)

def bench(name, f, *args, n=10):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.time()-t0)/n*1000
    print(f"{name:28s} {ms:8.1f} ms", flush=True)
    return ms

g_fwd = jax.jit(lambda p, zz: generator_apply(p, zz, a, compute_dtype=dt))
d_fwd = jax.jit(lambda p, x: discriminator_apply(p, x, a, compute_dtype=dt))
bench("G fwd", g_fwd, pG, z)
bench("D fwd", d_fwd, pD, img)

g_bwd = jax.jit(lambda p, zz: jax.grad(
    lambda pp: jnp.sum(generator_apply(pp, zz, a, compute_dtype=dt)))(p))
bench("G grad(params)", g_bwd, pG, z)

d_bwd = jax.jit(lambda p, x: jax.grad(
    lambda pp: bce_with_logits(discriminator_apply(pp, x, a, compute_dtype=dt), 1))(p))
bench("D grad(params) bce", d_bwd, pD, img)

def r1_loss(p, x):
    d_fn = lambda im: discriminator_apply(p, im, a, compute_dtype=dt)
    return r1_penalty(d_fn, x)
r1_fwd = jax.jit(r1_loss)
bench("R1 value (fwd+inner bwd)", r1_fwd, pD, img)
r1_gg = jax.jit(lambda p, x: jax.grad(r1_loss)(p, x))
bench("R1 grad-of-grad", r1_gg, pD, img)

# G phase: G fwd + D fwd + bwd through both
def g_phase(pg, pd, zz):
    def loss(pg):
        f = generator_apply(pg, zz, a, compute_dtype=dt)
        return generator_loss(discriminator_apply(pd, f, a, compute_dtype=dt), 1.0)
    return jax.grad(loss)(pg)
bench("G phase grad", jax.jit(g_phase), pG, pD, z)
