"""File I/O: the five serialisation formats, run directories, script potentials."""
