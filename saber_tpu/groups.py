"""CLI grouping/help configuration (reference saber/groups.py:18-64 builds
rich-click display groups; plain click here — rich_click is not in this
image — so this module just centralizes shared context settings)."""

cli_context = {
    "help_option_names": ["-h", "--help"],
    "max_content_width": 100,
}
