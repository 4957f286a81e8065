from .job import JobReport, extract_articles, run_job
from .pages import pages_from_documents, synthesize_html
from .session import get_spark

__all__ = [
    "JobReport",
    "extract_articles",
    "get_spark",
    "pages_from_documents",
    "run_job",
    "synthesize_html",
]
