{
  "algorithm": "ans",
  "ans_seg_log2": 16,
  "chunk_bounds": [
    0,
    1234,
    2468,
    3000
  ],
  "chunk_offsets": [
    0,
    13211,
    26456,
    33181
  ],
  "chunk_order": "F",
  "comp_level": -1,
  "do_spatial_diff": false,
  "do_time_diff": true,
  "dtype": "int16",
  "n_channels": 19,
  "sample_rate": 1234.0,
  "sha1_compressed": "48722933c30295a32ae23be1d199e514ca65e24f",
  "sha1_uncompressed": "5dc6b80b6404bf4d935d255bb91b2df544e9cddd",
  "shape": [
    3000,
    19
  ],
  "version": "2.0"
}