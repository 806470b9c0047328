from .extract import extract_text  # noqa: F401
from .synth import make_page, pages_dataframe, write_pages_parquet  # noqa: F401
