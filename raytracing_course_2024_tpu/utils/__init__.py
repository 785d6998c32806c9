from .math import almost_equal, chi_plus, safe_sqrt

__all__ = ["almost_equal", "chi_plus", "safe_sqrt"]
