"""Structured Streaming operators over event streams (SURVEY.md C7)."""
