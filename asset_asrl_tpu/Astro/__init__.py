"""Astro layer — populated later in the build (reference src/Astro + asset_asrl/Astro)."""
