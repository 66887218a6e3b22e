PREFIX : <http://example/>
DELETE WHERE { GRAPH :g1 { :s1 ?p ?o } }
