from .register import register_all  # noqa: F401
