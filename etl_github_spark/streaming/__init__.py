from .pipeline import stream_ingest, stream_windowed_counts  # noqa: F401
