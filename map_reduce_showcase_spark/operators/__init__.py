from .mapreduce import grep_lines, vertex_degree, word_count

__all__ = ["word_count", "grep_lines", "vertex_degree"]
