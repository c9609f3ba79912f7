from .generator import generate_repo_files, repo_files_dataframe

__all__ = ["generate_repo_files", "repo_files_dataframe"]
