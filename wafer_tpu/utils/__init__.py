"""Host utilities: terminal UX, logging, progress."""
