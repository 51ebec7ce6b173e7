"""Host-side utilities: impulse scripting, rendering/IO, timing, checkpointing."""
