"""Task models (RRG / RRS / MVQA / SELFSUP). Importing registers protos."""
