from .udfs import sigmoid_score

__all__ = ["sigmoid_score"]
