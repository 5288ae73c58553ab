from .jobs import APPS, JobResult, process_job, submit_job
from .mapreduce import grep_lines, vertex_degree, word_count
from .skew import salted_count_by_key, salted_join

__all__ = [
    "word_count",
    "grep_lines",
    "vertex_degree",
    "submit_job",
    "process_job",
    "JobResult",
    "APPS",
    "salted_count_by_key",
    "salted_join",
]
