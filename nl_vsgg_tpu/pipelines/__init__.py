from . import adv, negatives, tcs, triplets

__all__ = ["adv", "negatives", "tcs", "triplets"]
