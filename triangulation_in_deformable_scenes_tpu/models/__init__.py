"""Deformable refinement models: problem assembly, LM solver drivers, outer weight search."""
