import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
exec(open("/root/repo/.drive_r2.py").read())
