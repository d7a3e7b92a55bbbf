{
  "algorithm": "zlib",
  "chunk_bounds": [
    0,
    500,
    1000,
    1500,
    2000
  ],
  "chunk_offsets": [
    0,
    2039,
    4092,
    6138,
    8178
  ],
  "chunk_order": "F",
  "comp_level": -1,
  "do_spatial_diff": false,
  "do_time_diff": true,
  "dtype": "uint8",
  "n_channels": 7,
  "sample_rate": 500.0,
  "sha1_compressed": "27195542403ba8eab60458385e03126c6863ad49",
  "sha1_uncompressed": "25c3578929a881113e5a43dcbbde7e8602645a6c",
  "shape": [
    2000,
    7
  ],
  "version": "1.0"
}