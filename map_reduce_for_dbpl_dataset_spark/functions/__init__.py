from .exprs import authors_or_editors, venue_expr

__all__ = ["authors_or_editors", "venue_expr"]
