from .checks import QualityValidator, fixture_quality_report

__all__ = ["QualityValidator", "fixture_quality_report"]
