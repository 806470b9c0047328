from .extract import extract_text  # noqa: F401
from .synth import (  # noqa: F401
    clustered_embeddings,
    make_page,
    pages_dataframe,
    write_pages_parquet,
)
