"""Regenerate goldens_v1.json — run deliberately after intentional
numeric changes; review the diff before committing."""
# (generation script preserved from the original creation — see git history
# of tests/goldens/ for provenance; values are produced on CPU float64.)
