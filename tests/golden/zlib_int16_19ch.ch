{
  "algorithm": "zlib",
  "chunk_bounds": [
    0,
    1234,
    2468,
    3000
  ],
  "chunk_offsets": [
    0,
    16801,
    33697,
    41180
  ],
  "chunk_order": "F",
  "comp_level": -1,
  "do_spatial_diff": false,
  "do_time_diff": true,
  "dtype": "int16",
  "n_channels": 19,
  "sample_rate": 1234.0,
  "sha1_compressed": "53eb5e1ea094741a22578ae9950c90135829f8b9",
  "sha1_uncompressed": "5dc6b80b6404bf4d935d255bb91b2df544e9cddd",
  "shape": [
    3000,
    19
  ],
  "version": "1.0"
}