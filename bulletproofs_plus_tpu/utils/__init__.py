"""Host-side utilities: transcripts (Merlin/STROBE/Keccak), hashing, codecs."""
