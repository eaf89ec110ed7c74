from . import adv, clip_jax, negatives, tcs, tokenizer, triplets

__all__ = ["adv", "clip_jax", "negatives", "tcs", "tokenizer", "triplets"]
