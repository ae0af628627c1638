"""NLG + clinical metrics stack. Importing registers scorers."""
