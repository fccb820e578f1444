"""Training runtimes: jitted train steps, loops, curriculum schedules."""
