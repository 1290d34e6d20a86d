"""Training/eval CLIs."""
