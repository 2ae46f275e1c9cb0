from iltpu.utils.pytree import pytree_dataclass, static_field

__all__ = ["pytree_dataclass", "static_field"]
