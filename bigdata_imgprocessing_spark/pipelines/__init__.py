from .reference_jobs import run_color_pipeline, run_detection_pipeline, run_stats_pipeline

__all__ = ["run_detection_pipeline", "run_color_pipeline", "run_stats_pipeline"]
