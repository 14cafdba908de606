from .exprs import let_bind
from .udfs import sigmoid_score

__all__ = ["sigmoid_score", "let_bind"]
