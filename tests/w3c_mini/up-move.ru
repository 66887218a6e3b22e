PREFIX : <http://example/>
MOVE GRAPH :g1 TO :g2
