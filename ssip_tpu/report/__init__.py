"""Reporting layer: figures and tables matching the reference artifact set."""
