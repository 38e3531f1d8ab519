"""Cross-experiment reporting (reference plot.py, plot_loss.py)."""
