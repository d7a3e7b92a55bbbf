{
  "algorithm": "ans",
  "ans_seg_log2": 12,
  "ans_table_mode": "segment",
  "chunk_bounds": [
    0,
    1000,
    2000,
    2500
  ],
  "chunk_offsets": [
    0,
    88645,
    177498,
    220997
  ],
  "chunk_order": "F",
  "comp_level": -1,
  "do_spatial_diff": false,
  "do_time_diff": true,
  "dtype": "int16",
  "n_channels": 129,
  "sample_rate": 1000.0,
  "sha1_compressed": "4fdf9a0a41c6642f3c05e3a1bfabef0b816fb2f6",
  "sha1_uncompressed": "a1f7b70c73d2999a2705bd3ff2616a5a3b8fb51d",
  "shape": [
    2500,
    129
  ],
  "version": "2.0"
}