PREFIX : <http://example/>
DELETE { :s0 :p :o0 } USING :g1 WHERE { :s1 :p ?o }
