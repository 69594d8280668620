from cosmax.report.summary import summarize, format_summary
from cosmax.report import plots
from cosmax.report.html import hubble_diagram_html

__all__ = ["summarize", "format_summary", "plots", "hubble_diagram_html"]
