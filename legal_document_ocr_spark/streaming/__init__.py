from .pipeline import stream_extraction, stream_windowed_counts  # noqa: F401
