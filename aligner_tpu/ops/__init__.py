from .mas import mas_lax, maximum_path
from .mas_pallas import mas_pallas
from .mas_reference import mas_single, maximum_path_numpy

__all__ = [
    "mas_lax",
    "mas_pallas",
    "mas_single",
    "maximum_path",
    "maximum_path_numpy",
]
