import jax, jax.numpy as jnp
print("default:", jax.default_backend())
print("devices:", jax.devices())
x = jnp.ones((8, 128)) * 3
print("sum:", float(jnp.sum(x)))
