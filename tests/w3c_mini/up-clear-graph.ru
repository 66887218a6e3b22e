PREFIX : <http://example/>
CLEAR GRAPH :g2
