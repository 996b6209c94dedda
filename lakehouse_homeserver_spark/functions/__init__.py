from .vectors import cosine_sim, dot, l2_norm

__all__ = ["cosine_sim", "dot", "l2_norm"]
