"""L3 data providers: mesh IO, SDF sampling, NeRF datasets, ray generation."""
