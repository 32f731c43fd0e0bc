"""Data layer: KITTI raw reading, OXTS parsing, window assembly, device
prefetch, and the synthetic CI fixture (reference: ``deeplio/datasets/`` —
SURVEY.md §2.2)."""
