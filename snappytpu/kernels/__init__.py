from .encode_jax import encode_blocks  # noqa: F401
