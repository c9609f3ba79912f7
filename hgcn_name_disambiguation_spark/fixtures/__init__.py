from .generator import generate_repo_files, repo_files_dataframe
from .openalex import ensure_openalex_fixture

__all__ = [
    "generate_repo_files",
    "repo_files_dataframe",
    "ensure_openalex_fixture",
]
