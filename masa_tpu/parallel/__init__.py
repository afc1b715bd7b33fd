"""Multi-chip / multi-host parallelism: device meshes, the column-sharded
wavefront, and the inter-node control pool."""
