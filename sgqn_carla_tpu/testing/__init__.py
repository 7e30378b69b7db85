"""Testing fixtures shared by the test suite and golden-regeneration
scripts (the reference keeps the same split: dm_control's
`mujoco/testing/` package backs both its tests and its golden tooling)."""
