PREFIX : <http://example/>
INSERT DATA { ?x :p :o }
