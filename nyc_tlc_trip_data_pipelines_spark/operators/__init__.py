"""Composable operators: plain functions DataFrame -> DataFrame."""
