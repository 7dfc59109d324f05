"""Automatic training-data labeling pipeline (reference: dataset-generation/)."""
