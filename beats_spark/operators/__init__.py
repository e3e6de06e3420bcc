"""DataFrame operators — each reimplements one Beats processor family
(SURVEY.md §2) as a declarative Spark transform."""
