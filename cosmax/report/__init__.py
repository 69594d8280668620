from cosmax.report.summary import summarize, format_summary
from cosmax.report import plots

__all__ = ["summarize", "format_summary", "plots"]
