{
  "algorithm": "ans",
  "ans_seg_log2": 13,
  "ans_table_mode": "segment",
  "chunk_bounds": [
    0,
    1000,
    2000,
    3000,
    4000
  ],
  "chunk_offsets": [
    0,
    37706,
    75430,
    113164,
    150954
  ],
  "chunk_order": "F",
  "comp_level": -1,
  "do_spatial_diff": false,
  "do_time_diff": true,
  "dtype": "int16",
  "n_channels": 48,
  "sample_rate": 1000.0,
  "sha1_compressed": "fb314dc0c625c7fbd3477127f3c549422ea7108a",
  "sha1_uncompressed": "4ac0703d53d2f21193611a70e3af497c926bafe1",
  "shape": [
    4000,
    48
  ],
  "version": "2.0"
}