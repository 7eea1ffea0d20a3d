"""Host-side data layer: discovery, decode (+cache), splits, sampling, feeding."""
